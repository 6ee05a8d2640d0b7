"""Regenerate the pinned golden oracles for the model-driven NER/KG queries.

Usage:  python scripts/gen_goldens.py [--check]

Runs the deterministic pipeline queries (fixed 20-conversation corpus +
fingerprinted model) and writes fixtures/goldens_sf001.json, which
__spark_entry__.oracle_sql() turns into VALUES oracles. With --check, runs
the queries and compares against the existing goldens instead of writing
(used by tests to prove cross-process determinism).

Rerun this after ANY change that affects tokenizer rules, feature templates,
training, resolution, or triple extraction — the whole point of the pins is
that an unintended behavior change turns the driver's correctness rows red.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN_PATH = os.path.join(REPO, "fixtures", "goldens_sf001.json")

# query name -> columns to pin (must match the query's output exactly)
PINNED = ["ner_tokens", "ner_mentions", "kg_entities", "kg_triples", "multimodal_features"]


def compute() -> dict:
    from nametag_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    out = {}
    for name in PINNED:
        df = entry.queries()[name](spark, "/root/testdata/sf0.01")
        cols = df.columns
        rows = [[r[c] for c in cols] for r in df.collect()]
        rows.sort(key=lambda r: [(x is None, x) for x in r])
        out[name] = {"columns": cols, "rows": rows}
    spark.stop()
    return out


def main() -> int:
    data = compute()
    if "--check" in sys.argv:
        with open(GOLDEN_PATH, encoding="utf-8") as f:
            existing = json.load(f)
        ok = True
        for name in PINNED:
            if json.dumps(existing.get(name), sort_keys=True) != json.dumps(
                data[name], sort_keys=True
            ):
                print(f"MISMATCH: {name}")
                ok = False
            else:
                print(f"ok: {name} ({len(data[name]['rows'])} rows)")
        return 0 if ok else 1
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w", encoding="utf-8") as f:
        json.dump(data, f, ensure_ascii=False, separators=(",", ":"))
    for name in PINNED:
        print(f"pinned: {name} ({len(data[name]['rows'])} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
