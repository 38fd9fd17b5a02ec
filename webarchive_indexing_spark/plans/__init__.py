from .pipeline import (  # noqa: F401
    build_index,
    index_to_cdx_gz,
    cluster_from_cdx_gz,
    query_index,
)
