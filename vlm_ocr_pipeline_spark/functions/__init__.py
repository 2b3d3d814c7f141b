"""Pure pandas/numpy kernels — no Spark imports allowed in this package.

Every kernel here is the single source of truth for the corresponding
operator's semantics; the Spark stages in ``operators/`` call these per
Arrow batch.  Parity targets cite the reference implementation
(/root/reference) by file:line in each module docstring.
"""
