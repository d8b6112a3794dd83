from plwordnet_spark.extraction.oracle import (  # noqa: F401
    ParsedPage,
    clean_text,
    extract_links,
    extract_page,
    html_to_flat_text,
)
