"""Time minhash_dup_pairs at a given docs table (bench query shape), with
noop-free count() and per-rep cache release. Prints one JSON line.

Usage: python scripts/minhash_scale.py [docs_parquet] [cores] [reps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nametag_spark_bench/documents_scale_50000.parquet"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from nametag_spark.kg.resolution import release_persisted
    from nametag_spark.ops.dedup import minhash_dup_pairs
    from nametag_spark.session import get_spark

    spark = get_spark(app_name="minhash_scale", master=f"local[{cores}]", shuffle_partitions=cores)
    docs = spark.read.parquet(path)

    def run():
        return minhash_dup_pairs(docs, n_hashes=12, bands=4, shingle_k=5, threshold=0.7).count()

    n = run()  # warm codegen
    release_persisted()
    spark.catalog.clearCache()
    ts = []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"minhash#{i}")
        t0 = time.time()
        run()
        ts.append(time.time() - t0)
        release_persisted()
        spark.catalog.clearCache()
    print(json.dumps({
        "path": path, "cores": cores, "pairs": n,
        "times": [round(t, 3) for t in sorted(ts)],
        "med": round(sorted(ts)[len(ts) // 2], 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
