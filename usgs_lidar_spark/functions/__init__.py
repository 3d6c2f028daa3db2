"""Scalar-function surface: Mercator reprojection, string/regex helpers,
text statistics, vector math. All pure Catalyst column expressions (no
Python UDFs) unless explicitly noted — SURVEY.md §2 D1 design rule."""
