"""Sources: the deterministic synthetic Common-Crawl-style page generator
(FIXTURES.md §1) and Parquet IO helpers."""
