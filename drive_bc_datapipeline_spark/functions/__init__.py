"""Reusable column-function library (pure Column builders, no UDFs).

Everything here is a JVM-side expression usable in arbitrary user
queries; the registered plans in ``plans/`` compose these same
builders. Import as::

    from drive_bc_datapipeline_spark.functions import text, vectors, geo
"""

from drive_bc_datapipeline_spark.functions import geo, text, vectors  # noqa: F401
