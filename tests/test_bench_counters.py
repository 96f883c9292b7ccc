"""Unit gates for bench.py's interference counters (no Spark).

The scaling/dim512 clean flags in the committed bench record are only
as trustworthy as these helpers: _read_steal parses /proc/stat (whole
machine and per-pinned-core), _steal_pct turns two samples into a
percentage, _membw_gbps times a DRAM sweep.  A silent parse regression
(field drift, header change) would turn every clean flag into garbage
without failing anything — these tests pin the arithmetic and the
parse shape.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(_ROOT, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_steal_pct_arithmetic(bench):
    # 50 steal ticks over 1000 total ticks = 5%
    assert bench._steal_pct((100, 10_000), (150, 11_000)) == 5.0
    # zero elapsed or missing samples -> None, never a ZeroDivisionError
    assert bench._steal_pct((100, 10_000), (100, 10_000)) is None
    assert bench._steal_pct(None, (1, 2)) is None
    assert bench._steal_pct((1, 2), None) is None
    # time moving backwards (counter reset) -> None
    assert bench._steal_pct((100, 10_000), (0, 0)) is None


def test_read_steal_machine_wide(bench):
    s = bench._read_steal()
    assert s is not None
    steal, total = s
    assert steal >= 0 and total > 0 and steal <= total


def test_read_steal_pinned_subset(bench):
    ncpu = os.cpu_count() or 1
    sub = bench._read_steal(range(max(0, ncpu - 2), ncpu))
    full = bench._read_steal()
    assert sub is not None and full is not None
    # a 2-cpu subset must account for (weakly) fewer ticks than the
    # machine-wide aggregate line
    assert sub[1] <= full[1]
    assert sub[0] <= full[0] + 1  # aggregate rounds per-cpu ticks down


def test_read_steal_empty_selection(bench):
    # cpu ids beyond the machine: no lines match -> None, not (0, 0)
    assert bench._read_steal(range(4096, 4098)) is None


def test_steal_delta_monotonic(bench):
    import time

    a = bench._read_steal()
    time.sleep(0.05)
    b = bench._read_steal()
    pct = bench._steal_pct(a, b)
    # on a live machine ticks advanced, so a percentage exists and is
    # sane
    assert pct is None or 0.0 <= pct <= 100.0


def test_membw_probe_positive_and_bounded(bench):
    g = bench._membw_gbps()
    # any real DRAM reads a 256 MB sweep somewhere between 0.01 GB/s
    # (catastrophic contention) and 1 TB/s (beyond any single core)
    assert 0.01 < g < 1000.0
    # buffer is cached for reuse — the probe must not reallocate 256 MB
    # per sample
    assert bench._MEMBW_BUF is not None
    assert bench._membw_gbps() > 0.0
