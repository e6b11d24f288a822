"""Sources & sinks (reference operators S1-S11, SURVEY.md §2.1)."""

from olist_data_warehouse_spark.sources.readers import (  # noqa: F401
    load_testdata,
    read_csv,
    read_parquet,
)
from olist_data_warehouse_spark.sources.lakehouse import (  # noqa: F401
    ConcurrentCommitError,
    LakeTable,
    with_occ_retry,
)
from olist_data_warehouse_spark.sources.lakebatch import (  # noqa: F401
    LakeBatchDataSource,
)
from olist_data_warehouse_spark.sources.lakestream import (  # noqa: F401
    LakeStreamDataSource,
)
from olist_data_warehouse_spark.sources.writers import (  # noqa: F401
    append_rows,
    append_table,
    create_database,
    ctas,
    delete_where,
    rename_table,
)
