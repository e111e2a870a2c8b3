#!/usr/bin/env python
"""Capture .explain("formatted") for the round-15-touched queries into
plans/r16/<query>_<tag>.txt (the judge checks plan claims against these).

Usage: python scripts/capture_plans_r16.py <tag> [query ...]
Run at the baseline commit with tag=before and at HEAD with tag=after.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entry_mod  # noqa: E402
from seriesly_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "suffix_dup_stats",
    "dedup_spans_exact",
    "score_lang_lr",
    "train_lang_lr",
    "lang_lr_confusion",
    "score_quality_lr",
    "train_quality_lr",
    "quality_lr_auc",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_r2",
    "dedup_minhash_auto",
    "dedup_minhash_cross",
    "minhash_bucketed_probe",
    "minhash_index_incremental",
    "dedup_ladder_report",
    "pagerank_docs",
    "hits_docs",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r16",
    )
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plans-r16")
    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(txt)
        print("captured", name, tag, flush=True)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
