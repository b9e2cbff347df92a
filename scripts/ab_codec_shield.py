"""Interleaved A/B for the codec presentation-sort shield (r15).

OLD: feature frame -> bare orderBy (range partitioner's bounds-sampling
job re-executes the zero-shuffle Python codec chain a second time).
NEW: feature frame -> repartition(cols) -> orderBy (the sampling job
materializes the hash shuffle once; the sort's map stage reuses the
shuffle files — multimodal_q._present).

Variants alternate within one session, min-of-N each, so host-load
noise hits both equally.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from bristle_spark import multimodal
from bristle_spark.catalog import load_table
from bristle_spark.session import get_spark

SF = "/root/testdata/sf0.1"
N = 5


def build(spark, shielded: bool):
    d = load_table(spark, SF, "documents")
    payloads = multimodal.attach_jpeg_payload(d)
    feats = multimodal.pixel_stats(payloads, decode_backend="jpeg")
    if shielded:
        feats = feats.repartition("doc_id")
    return feats.orderBy("doc_id")


def main() -> None:
    spark = get_spark(app_name="ab-codec-shield")
    spark.range(1000).selectExpr("sum(id)").collect()
    build(spark, True).write.format("noop").mode("overwrite").save()  # warm
    best = {"old": float("inf"), "new": float("inf")}
    for i in range(N):
        for tag, shielded in (("old", False), ("new", True)):
            spark.sparkContext.setJobDescription(f"{tag}#{i}")
            t0 = time.perf_counter()
            build(spark, shielded).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best[tag] = min(best[tag], dt)
            print(f"{tag}#{i}: {dt:.3f}s", flush=True)
    print(f"min-of-{N}: old={best['old']:.3f}s new={best['new']:.3f}s "
          f"ratio={best['new']/best['old']:.3f}")


if __name__ == "__main__":
    main()
