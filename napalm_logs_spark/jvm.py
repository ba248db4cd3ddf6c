"""JVM classpath probing shared by the optional-connector adapters.

Resolution goes through Spark's own classloader
(``Utils.classForName`` → context/MutableURLClassLoader), NOT the
system classloader: jars added via ``spark-submit --packages`` are
visible only to Spark's loader, so a plain ``java.lang.Class.forName``
probe reports a connector absent on exactly the deployments that
have it.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def jvm_class_available(spark: SparkSession, name: str) -> bool:
    """True when ``name`` is loadable through Spark's classloader."""
    jvm = spark.sparkContext._jvm
    try:
        jvm.org.apache.spark.util.Utils.classForName(name, False, False)
        return True
    except Exception:
        pass
    try:  # older/newer Utils signatures — fall back to a direct probe
        loader = jvm.java.lang.Thread.currentThread().getContextClassLoader()
        jvm.java.lang.Class.forName(name, False, loader)
        return True
    except Exception:
        return False
