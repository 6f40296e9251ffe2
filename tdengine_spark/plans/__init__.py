"""Plan-level services: TSMA pre-aggregation + rewrite, retention/rollup."""
