"""Scalar / vectorized functions (the UDF surface).

In the reference the transform layer IS the UDF surface (multimethods on
event format, ``src/genegraph/transform/types.clj:5-36``); here every
Python crossing is an Arrow-batched pandas UDF — never row-at-a-time.
"""
