"""A/B the LSH verify-join physical plan at smoke scale.

A (current): fused self-join carrying BOTH the int-hash arrays (_hd) and
the string shingles (_sh) on every bucket row — one join, heavy payload.
B (candidate): self-join carries only (_hd, _n); exact-Jaccard runs after
joining _sh back for the hash-prefilter survivors (~8% of pairs).

Both must emit the identical edge set. Prints one JSON line.

Usage: python scripts/verify_ab.py [n_conversations] [cores] [vocab_scale]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    vocab_scale = int(sys.argv[3]) if len(sys.argv) > 3 else 30

    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from nametag_spark.kg import resolution as R
    from nametag_spark.ner.pipeline import recognize_df
    from nametag_spark.session import get_spark

    corpus_path = f"/tmp/nametag_spark_bench/kg_full_smoke_{n_conv}_v{vocab_scale}.parquet"
    spark = get_spark(
        app_name=f"verify_ab_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SMOKE_SHUFFLE", cores * 2)),
    )
    df = spark.read.parquet(corpus_path).repartition(cores * 4).persist()
    df.count()
    mentions = recognize_df(df, entry._model_dir()).persist()
    mentions.count()
    m = R.canonicalize_mentions(mentions).where(F.length("norm") > 0)
    surfaces = m.groupBy("type", "norm").agg(F.count(F.lit(1)).alias("n_mentions")).persist()
    surfaces = surfaces.withColumn("sid", R._hash64(F.concat_ws("\t", "type", "norm"), 0))
    surfaces.count()
    out = {"n_conversations": n_conv, "cores": cores}

    def run_a():
        e = R.lsh_similarity_edges(
            surfaces.select("sid", "type", "norm"), "norm", "sid",
            n_hashes=12, bands=4, k=3, threshold=0.6, max_bucket=200, block_col="type",
        )
        t0 = time.time()
        agg = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.hash("src", "dst").cast("long")).alias("chk"),
        ).collect()[0]
        R.release_persisted()
        return round(time.time() - t0, 1), int(agg["n"]), int(agg["chk"])

    def run_b():
        sig, carry = R._surface_signatures(
            surfaces.select("sid", "type", "norm"), "norm", "sid", 12, 3, "type"
        )
        # bucket rows WITHOUT the string shingles; _sh stays on a slim
        # per-surface side table joined back only for survivors
        sig_slim = sig.drop("_sh")
        carry_slim = [c for c in carry if c != "_sh"]
        sh_side = sig.select("_k", "_sh")
        ok = R._banded_ok_buckets(sig_slim, carry_slim, 12, 4, 200, block_cols=["_blk"])
        l, r = ok.alias("l"), ok.alias("r")
        cond = (
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.sig") == F.col("r.sig"))
            & (F.col("l._blk") == F.col("r._blk"))
            & (F.col("l._k") < F.col("r._k"))
        )
        ih = F.size(F.array_intersect("l._hd", "r._hd"))
        jac_h = ih / (F.size("l._hd") + F.size("r._hd") - ih)
        cand = (
            l.join(r, cond)
            .where(jac_h >= 0.6)
            .select(
                F.col("l._k").alias("src"), F.col("r._k").alias("dst"),
                F.col("l._n").alias("_na"), F.col("r._n").alias("_nb"),
            )
            .distinct()
        )
        inter = F.size(F.array_intersect("_sha", "_shb"))
        jac = inter / (F.col("_na") + F.col("_nb") - inter)
        e = (
            cand.join(sh_side.select(F.col("_k").alias("src"), F.col("_sh").alias("_sha")), "src")
            .join(sh_side.select(F.col("_k").alias("dst"), F.col("_sh").alias("_shb")), "dst")
            .where(jac >= 0.6)
            .select("src", "dst")
        )
        t0 = time.time()
        agg = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.hash("src", "dst").cast("long")).alias("chk"),
        ).collect()[0]
        R.release_persisted()
        return round(time.time() - t0, 1), int(agg["n"]), int(agg["chk"])

    # interleave to split window drift fairly
    order = os.environ.get("VERIFY_AB_ORDER", "abab")
    results = {}
    seq_a, seq_b = [], []
    for c in order:
        if c == "a":
            t, n, chk = run_a(); seq_a.append(t); results.setdefault("a", (n, chk))
            assert results["a"] == (n, chk)
        else:
            t, n, chk = run_b(); seq_b.append(t); results.setdefault("b", (n, chk))
            assert results["b"] == (n, chk)
    ta1, ta2 = seq_a[0], seq_a[-1]
    tb1, tb2 = seq_b[0], seq_b[-1]
    na, chka = results["a"]; nb, chkb = results["b"]
    na2, chka2, nb2, chkb2 = na, chka, nb, chkb
    out["a_seconds"] = [ta1, ta2]
    out["b_seconds"] = [tb1, tb2]
    out["n_edges"] = [na, nb, na2, nb2]
    out["checksum_match"] = (na, chka) == (nb, chkb) == (na2, chka2) == (nb2, chkb2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
