"""Ray Data operators: per-batch stages, joins, dedup, text, search, windows.

Everything here takes and returns ``ray.data.Dataset`` (or pure
``pyarrow.Table`` helpers usable inside ``map_batches``); nothing calls
``ray.init``. Hot paths are ``batch_format="pyarrow"`` with
pyarrow.compute / numpy / polars kernels — no per-row Python.
"""
