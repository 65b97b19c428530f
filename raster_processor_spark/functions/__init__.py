"""Column-function library: Arrow-batched pandas UDFs wrapping the numpy
kernels, plus pure column expressions for the SQL-expressible pieces."""

from raster_processor_spark.functions.cells import (  # noqa: F401
    hex_cell_udf,
    quad_cell_udf,
    quad_parent_col,
)
from raster_processor_spark.functions.quality import (  # noqa: F401
    summary_qual_col,
)
from raster_processor_spark.functions.geodesy import (  # noqa: F401
    lon_360to180_col,
)
