"""Python driver for graft buckets -- the executed half of the X5 surface.

A user's PySpark script gets its bucket inputs BY SIGNATURE and emits its
result through a context object, mirroring the reference platform's Python
shim contract (aleph2_driver.py:1-32: getRddInput(name) / emitRdd) without
the wrapper process or the RDD serialization hop: inputs resolve from a
JSON manifest of {signature: parquet path} the Scala side writes
(graft.sql.SqlSurface.writePythonManifest), and emit() is an ordinary
DataFrame write the Scala side reads back.

Usage (what PySparkBridgeSpec runs):

    python3 user_script.py <manifest.json> <output dir>

with a user script shaped like:

    from graft_pyspark_driver import GraftContext
    ctx = GraftContext.from_argv(sys.argv)
    df = ctx.input("my_bucket_signature")
    ctx.emit(df.groupBy("k").count())
    ctx.stop()
"""
import json
import sys

from pyspark.sql import SparkSession


class GraftContext(object):
    def __init__(self, spark, manifest, out_dir):
        self.spark = spark
        self.manifest = manifest
        self.out_dir = out_dir

    @classmethod
    def from_argv(cls, argv):
        if len(argv) < 3:
            raise SystemExit(
                "usage: %s <manifest.json> <output dir>" % argv[0])
        with open(argv[1]) as f:
            manifest = json.load(f)
        spark = (
            SparkSession.builder.master("local[2]")
            .appName("graft-x5-python")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.shuffle.partitions", "4")
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate())
        return cls(spark, manifest, argv[2])

    def signatures(self):
        return sorted(self.manifest)

    def input(self, signature):
        """The getRddInput analog: a DataFrame for a bucket signature."""
        if signature not in self.manifest:
            raise KeyError(
                "unknown bucket signature %r; manifest has %s"
                % (signature, self.signatures()))
        return self.spark.read.parquet(self.manifest[signature])

    def emit(self, df):
        """The emitRdd analog: publish the script's result."""
        df.write.mode("overwrite").parquet(self.out_dir)

    def stop(self):
        self.spark.stop()
