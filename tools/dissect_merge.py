"""Stage-by-stage noop-sink dissection of the CDC merge pipeline (guide §1.1/1.4).

Times each incremental refinement of the merge plan on one batch's worth of
event files (8 of the 16 fixture chunks), twice each (2nd run = steady state).
"""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from seatunnel_spark.schema import event_schema
from seatunnel_spark.session import get_spark

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("dissect", master=f"local[{CPUS}]", shuffle_partitions=CPUS,
                  extra_conf={"spark.local.dir": "/dev/shm/spark-tmp"})

files = sorted(glob.glob("/root/repo/.cache/cdc_500000_4000000/events/*.parquet"))[:8]
key = ["repo", "path"]
N_BUCKETS = 32


def batch():
    ev = spark.read.schema(event_schema()).parquet(*files)
    return ev.where(F.col("op") != "DDL")


def timeit(label, df_fn, writer="noop"):
    for i in range(2):
        df = df_fn()
        t0 = time.time()
        if writer == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            out = f"/dev/shm/dissect_out_{label.replace(' ', '_')}"
            import shutil
            shutil.rmtree(out, ignore_errors=True)
            df.write.partitionBy("bucket").parquet(out)
        print(f"{label} run{i}: {time.time()-t0:.2f}s", file=sys.stderr, flush=True)


bucket = F.pmod(F.hash(*key), F.lit(N_BUCKETS)).cast("int")
fields = ["repo", "path", "commit", "lang", "content"]


def wide():
    return batch().select(*fields, "op", "seq").withColumn("bucket", bucket)


def tagged():
    payload = [c for c in fields if c not in key] + ["op", "bucket"]
    return wide().withColumn("_tb", F.xxhash64(*payload))


def winners():
    t = tagged()
    return (
        t.groupBy(*key)
        .agg(F.max(F.struct(F.col("seq"), F.col("_tb"))).alias("_w"))
        .select(*key, F.col("_w.seq").alias("seq"), F.col("_w._tb").alias("_tb"))
    )


def repart():
    return tagged().repartition(N_BUCKETS, *key)


def semi():
    return repart().join(winners().hint("shuffle_hash"), [*key, "seq", "_tb"], "leftsemi")


def semi_distinct():
    return semi().distinct().drop("_tb")


def semi_dropdup():
    return semi().dropDuplicates([*key, "seq", "_tb"]).drop("_tb")


def bcast():
    t = tagged()
    w = (
        t.groupBy(*key)
        .agg(F.max(F.struct(F.col("seq"), F.col("_tb"))).alias("_w"))
        .select(*key, F.col("_w.seq").alias("seq"), F.col("_w._tb").alias("_tb"))
    )
    kept = t.join(F.broadcast(w), [*key, "seq", "_tb"], "leftsemi")
    return kept.repartition(N_BUCKETS, *key).distinct().drop("_tb")


which = sys.argv[1:] or ["scan", "tagged", "winners", "repart", "semi", "distinct", "dropdup", "write"]
if "scan" in which:
    timeit("1 wide scan", wide)
if "tagged" in which:
    timeit("2 + xxhash tag", tagged)
if "winners" in which:
    timeit("3 winners agg only", winners)
if "repart" in which:
    timeit("4 scan+repartition", repart)
if "semi" in which:
    timeit("5 + semi join", semi)
if "distinct" in which:
    timeit("6 + distinct", semi_distinct)
if "dropdup" in which:
    timeit("6b + dropDuplicates", semi_dropdup)
if "bcast" in which:
    timeit("6c broadcast winners", bcast)
if "write" in which:
    timeit("7 full + parquet write", semi_distinct, writer="parquet")
if "write_dropdup" in which:
    timeit("7b dropdup + parquet write", semi_dropdup, writer="parquet")
