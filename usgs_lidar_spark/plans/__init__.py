"""Named query plans: the engine's public query surface.

`queries.QUERIES` maps query name -> fn(spark, sf_dir) -> DataFrame;
`queries.ORACLE` maps the same names to ANSI-SQL DuckDB oracles. This is
the contract consumed by /root/repo/__spark_entry__.py."""
