"""End-to-end pipelines: the flagship spatial-join + tiling run and the
checkpoint/lineage manifest machinery."""
