"""Deterministic (seed=42) synthetic corpus per FIXTURES.md.

Generates the authoritative input shape from BASELINE.json input_hint:

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

plus the broadcastable ``entity_index(entity_id, name, embedding)`` with a
skewed hub subset (~1% of entities draw ~30% of mentions) to exercise
AQE-skew/salting, mirroring the hot-key hazard the reference never had to
face single-threaded.

Text spans embed an entity's name tokens amid vocab noise (the signal the
encoder recovers); image spans carry the entity name inside the media_ref
path — the pseudo-CLIP analogue of "an image of X" living near the text
"X" in CLIP space (reference: shared text/image space, README.md:8-10,
query-index.py:86-108).

Edge-case rows baked at fixed doc ids (FIXTURES.md §4): empty span array,
single-span doc, token-less span (zero-vector -> normalize passthrough,
query-index.py:14-16), corrupt media (-> skips, build-index.py:53-61),
duplicate re-ingested doc (idempotency, build-index.py:42-44).
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd

from ..config import DIM, SEED
from ..functions.encoder import encode_string

# fixed 200-word vocabulary (deterministic: seeded shuffle of a product set)
_CONS = "b c d f g l m n p r s t v z".split()
_VOW = "a e i o u".split()


def vocabulary(n: int = 200, seed: int = SEED) -> list[str]:
    words = []
    for c1 in _CONS:
        for v1 in _VOW:
            for c2 in _CONS:
                words.append(c1 + v1 + c2 + "a")
    rnd = random.Random(seed)
    rnd.shuffle(words)
    return words[:n]


def make_entities(n_entities: int, dim: int = DIM, seed: int = SEED) -> pd.DataFrame:
    """entity_index rows: (entity_id, name, embedding list[float32], is_hub)."""
    vocab = vocabulary(seed=seed)
    rnd = random.Random(seed * 7 + 1)
    rows = []
    n_hubs = max(1, n_entities // 100)
    for i in range(n_entities):
        name = " ".join(
            rnd.sample(vocab, rnd.randint(1, 3)) + [f"ent{i:06d}"]
        )
        emb = encode_string(name, dim=dim, seed=seed)
        rows.append(
            {
                "entity_id": f"ent{i:06d}",
                "name": name,
                "embedding": emb.tolist(),
                "is_hub": i < n_hubs,
            }
        )
    return pd.DataFrame(rows)


def make_documents(
    n_docs: int,
    entities: pd.DataFrame,
    seed: int = SEED,
) -> pd.DataFrame:
    """documents rows: (doc_id, spans=[{kind,text,media_ref,offset}...]).

    ~70/30 text/image spans, 1-12 spans/doc; 80% of spans mention an
    entity (hubs drawing ~30% of those), 20% pure noise.
    """
    vocab = vocabulary(seed=seed)
    rnd = random.Random(seed * 13 + 2)
    ents = entities.to_dict("records")
    hubs = [e for e in ents if e["is_hub"]] or ents[:1]

    def pick_entity():
        if rnd.random() < 0.30:
            return rnd.choice(hubs)
        return rnd.choice(ents)

    docs = []
    for d in range(n_docs):
        doc_id = f"doc{d:08d}"
        spans = []
        offset = 0
        for s in range(rnd.randint(1, 12)):
            kind = "text" if rnd.random() < 0.70 else "image"
            mention = rnd.random() < 0.80
            ent = pick_entity() if mention else None
            if kind == "text":
                words = rnd.sample(vocab, rnd.randint(3, 8))
                if ent is not None:
                    pos = rnd.randint(0, len(words))
                    words = words[:pos] + ent["name"].split() + words[pos:]
                text, media_ref = " ".join(words), ""
            else:
                text = ""
                if ent is not None:
                    media_ref = (
                        "img://" + "/".join(ent["name"].split())
                        + f"/{rnd.randrange(16**6):06x}"
                    )
                else:
                    media_ref = f"img://noise/{rnd.randrange(16**6):06x}"
            spans.append(
                {"kind": kind, "text": text, "media_ref": media_ref,
                 "offset": offset}
            )
            offset += max(len(text), len(media_ref)) + 1
        docs.append({"doc_id": doc_id, "spans": spans})

    # --- edge cases at fixed, stable doc ids (appended, deterministic) ---
    def edge(doc_id, spans):
        docs.append({"doc_id": doc_id, "spans": spans})

    edge("docEDGE_EMPTY", [])
    edge("docEDGE_SINGLE", [
        {"kind": "text", "text": ents[0]["name"], "media_ref": "", "offset": 0}
    ])
    # token-less text -> zero vector -> normalize passthrough
    edge("docEDGE_ZERO", [
        {"kind": "text", "text": "!!! ???", "media_ref": "", "offset": 0}
    ])
    # undecodable media -> quarantined to skips, run continues
    edge("docEDGE_CORRUPT", [
        {"kind": "image", "text": "", "media_ref": "img://CORRUPT/deadbeef",
         "offset": 0},
        {"kind": "text", "text": ents[1]["name"], "media_ref": "", "offset": 30},
    ])
    # duplicate of doc 0 content under a new id, plus literal re-ingest of
    # doc 0 is tested by unioning the frame with itself in tests.
    if docs:
        edge("docEDGE_DUP", docs[0]["spans"])
    return pd.DataFrame(docs)


SPANS_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)
ENTITY_SCHEMA = (
    "entity_id string, name string, embedding array<float>, is_hub boolean"
)


def documents_to_spark(spark, docs: pd.DataFrame):
    rows = [(r["doc_id"],
             [(s["kind"], s["text"], s["media_ref"], s["offset"])
              for s in r["spans"]])
            for r in docs.to_dict("records")]
    return spark.createDataFrame(rows, schema=SPANS_SCHEMA)


def entities_to_spark(spark, ents: pd.DataFrame):
    rows = [tuple(r) for r in ents[
        ["entity_id", "name", "embedding", "is_hub"]].itertuples(index=False)]
    return spark.createDataFrame(rows, schema=ENTITY_SCHEMA)


def corpus(n_docs: int, n_entities: int, dim: int = DIM, seed: int = SEED):
    """Convenience: (documents_pdf, entities_pdf)."""
    ents = make_entities(n_entities, dim=dim, seed=seed)
    docs = make_documents(n_docs, ents, seed=seed)
    return docs, ents
