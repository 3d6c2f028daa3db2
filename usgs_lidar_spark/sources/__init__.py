"""Sources & sinks: CSV/JSON/text readers with the reference's null
semantics, the distributed HTTP catalog crawl, and partitioned Parquet
sinks whose layout is the engine's 'octree' (SURVEY.md §4 row 1)."""
