"""Driver-side filesystem access through the JVM Hadoop API.

Spark jobs address storage by URI (file://, hdfs://, s3a://); plain
``open()``/``os.rename()`` on those paths only works when the path
happens to be driver-local. Every small sidecar read/write and every
atomic directory swap in this repo goes through these helpers so the
same code runs against whatever filesystem the session is configured
for (object-store rename caveats are the caller's to document).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path-class) for ``path``'s scheme."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jvm.org.apache.hadoop.fs.Path


def write_text(spark: SparkSession, path: str, data: str) -> None:
    """Small sidecar write (create/overwrite) — driver-side, but
    through the Hadoop stream API so s3a://hdfs:// paths work."""
    fs, Path = hadoop_fs(spark, path)
    out = fs.create(Path(path), True)
    try:
        out.write(bytearray(data.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, path: str) -> str:
    """Small sidecar read, whole file. commons-io is on Spark's
    classpath; py4j can't copy mutations back into a Python-side
    buffer, so the byte shuttling happens JVM-side."""
    fs, Path = hadoop_fs(spark, path)
    stream = fs.open(Path(path))
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
