"""Ray Data pipeline stages.  Narrow per-batch transforms are stateless
``map_batches`` functions; stages holding derived model parameters are
callable classes run as actor pools; wide steps (band grouping, pair dedup,
verify join, union-find rounds) are ``groupby``/``join`` shuffles with
explicit skew handling (SURVEY.md §4)."""
