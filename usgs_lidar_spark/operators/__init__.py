"""Engine operators: voxel aggregation, spatial predicates/joins, dedup,
similarity search, as-of joins. Each module documents the reference
behavior it re-expresses (file:line into /root/reference) and the Spark
physical plan it is designed to produce at 100 TB."""
