"""M5 gate: kill/resume at partition granularity (SURVEY.md §5.5).

Kill after p embed partitions; resume; assert (a) the resumed run only
computed the missing partitions (lineage run_id proves it), (b) final
triples equal a fresh uninterrupted run."""

from pyspark.sql import functions as F

from cli_p_spark.config import PipelineConfig
from cli_p_spark.fixtures.generate import documents_to_spark
from cli_p_spark.plans.lineage import read_lineage, run_pipeline


def _triples_set(spark, out_dir):
    return sorted(
        map(
            tuple,
            spark.read.parquet(f"{out_dir}/triples")
            .select("subj", "span_idx", "pred", "obj")
            .collect(),
        )
    )


def test_kill_resume_partition_granularity(spark, corpus_small, tmp_path):
    docs_pdf, ents_pdf = corpus_small
    docs = documents_to_spark(spark, docs_pdf)
    cfg = PipelineConfig()

    # fresh run as the golden result
    full_dir = str(tmp_path / "full")
    r = run_pipeline(spark, docs, ents_pdf, full_dir, cfg, run_id="full")
    assert r["status"] == "done"

    # killed run: only 5 of 16 partitions complete
    resume_dir = str(tmp_path / "resume")
    r1 = run_pipeline(
        spark, docs, ents_pdf, resume_dir, cfg,
        run_id="run1", fail_after_parts=5,
    )
    assert r1["status"] == "killed"
    lin1 = read_lineage(spark, resume_dir)
    done1 = {
        r["part_id"] for r in lin1.filter("stage='embed'").collect()
    }
    assert len(done1) == 5

    # resume: must finish, recomputing nothing from run1
    r2 = run_pipeline(
        spark, docs, ents_pdf, resume_dir, cfg, run_id="run2"
    )
    assert r2["status"] == "done"
    lin = read_lineage(spark, resume_dir).filter("stage='embed'").collect()
    by_run = {}
    for row in lin:
        by_run.setdefault(row["run_id"], set()).add(row["part_id"])
    assert by_run["run1"] == done1  # untouched
    assert by_run["run2"].isdisjoint(done1)  # nothing recomputed
    assert len(by_run["run1"] | by_run["run2"]) == 16

    # identical final result
    assert _triples_set(spark, resume_dir) == _triples_set(spark, full_dir)


def test_rerun_completed_is_noop_for_embed(spark, corpus_small, tmp_path):
    """Re-running a finished pipeline re-embeds nothing (idempotency,
    reference semantics build-index.py:42-44)."""
    docs_pdf, ents_pdf = corpus_small
    docs = documents_to_spark(spark, docs_pdf)
    out = str(tmp_path / "once")
    run_pipeline(spark, docs, ents_pdf, out, run_id="a")
    n_mentions_before = spark.read.parquet(f"{out}/mentions").count()
    run_pipeline(spark, docs, ents_pdf, out, run_id="b")
    lin = read_lineage(spark, out).filter(
        (F.col("stage") == "embed") & (F.col("run_id") == "b")
    )
    assert lin.count() == 0  # no embed partitions recomputed
    assert spark.read.parquet(f"{out}/mentions").count() == n_mentions_before


def test_lineage_metrics_present(spark, corpus_small, tmp_path):
    docs_pdf, ents_pdf = corpus_small
    docs = documents_to_spark(spark, docs_pdf)
    out = str(tmp_path / "metrics")
    run_pipeline(spark, docs, ents_pdf, out, run_id="m")
    lin = read_lineage(spark, out)
    embed = lin.filter("stage='embed'")
    assert embed.count() == 16
    assert embed.filter("n_rows <= 0").count() == 0
    assert embed.filter("wall_s <= 0").count() == 0
    assert lin.filter("stage='link' and n_rows > 0").count() == 1
    # the corrupt span was quarantined and counted in exactly one partition
    assert embed.agg(F.sum("n_skips")).first()[0] == 1


def test_kill_inside_commit_window_no_duplicates(spark, corpus_small,
                                                 tmp_path):
    """The crash-atomicity gate: kill AFTER partition data commits but
    BEFORE its lineage rows do (fail_mode='after_data').  The resume
    re-runs those partitions; dynamic-partition overwrite must replace,
    not duplicate, their mention rows — final result identical to a
    fresh uninterrupted run."""
    docs_pdf, ents_pdf = corpus_small
    docs = documents_to_spark(spark, docs_pdf)
    cfg = PipelineConfig()

    full_dir = str(tmp_path / "full")
    run_pipeline(spark, docs, ents_pdf, full_dir, cfg, run_id="full")

    crash_dir = str(tmp_path / "crash")
    r1 = run_pipeline(
        spark, docs, ents_pdf, crash_dir, cfg,
        run_id="run1", fail_after_parts=5, fail_mode="after_data",
    )
    assert r1["status"] == "killed"
    # data landed, lineage did not: the exact corruption window
    assert read_lineage(spark, crash_dir) is None
    n_orphan = spark.read.parquet(f"{crash_dir}/mentions").count()
    assert n_orphan > 0

    r2 = run_pipeline(spark, docs, ents_pdf, crash_dir, cfg, run_id="run2")
    assert r2["status"] == "done"
    # every partition re-ran (none was marked done)...
    lin = read_lineage(spark, crash_dir).filter("stage='embed'")
    assert lin.filter("run_id='run2'").count() == 16
    # ...and the overwritten partitions hold NO duplicate mentions
    men = spark.read.parquet(f"{crash_dir}/mentions")
    assert men.count() == men.select("doc_id", "span_idx").distinct().count()
    assert men.count() == spark.read.parquet(f"{full_dir}/mentions").count()
    assert _triples_set(spark, crash_dir) == _triples_set(spark, full_dir)


def test_tablestore_read_raises_on_corrupt_not_absent(spark, tmp_path):
    """TableStore.read returns None ONLY for table-absent; a corrupt
    table raises instead of silently restarting the pipeline from
    scratch (which would duplicate every partition)."""
    import pytest

    from cli_p_spark.plans.tables import TableStore

    store = TableStore(spark, str(tmp_path / "store"))
    assert store.read("nope") is None  # absent -> None
    # corrupt parquet footer -> must raise, not masquerade as absent
    bad = tmp_path / "store" / "broken"
    bad.mkdir(parents=True)
    (bad / "part-00000.parquet").write_bytes(b"not a parquet file")
    with pytest.raises(Exception):
        df = store.read("broken")
        df.collect()  # some engines defer footer reads to the scan
