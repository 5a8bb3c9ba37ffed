"""Training-data-pipeline operator library.

Everything here is built JVM-side from ``pyspark.sql.functions``
(whole-stage codegen) except where a pandas UDF is genuinely required;
hashes are md5-based so a DuckDB oracle can reproduce values bit-for-bit.
"""

from . import media, neardup, similarity, text  # noqa: F401
