"""Pallas TPU kernels for the hot paths.

Each kernel has a pure-jnp reference twin in the main modules; equivalence is
pinned by interpret-mode tests (the TPU analogue of the reference's
sanitizer story — see SURVEY §5).
"""
