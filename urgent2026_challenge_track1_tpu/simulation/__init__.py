"""Simulation / augmentation engine: one kernel, two drivers.

Mirrors the reference's single-source-of-truth property (SURVEY.md §1):
``params.sample_meta`` draws a reproducible augmentation recipe (pure
metadata, round-trips through meta.tsv strings) and ``render.render_one``
turns a recipe into audio — used both by the offline materialization CLIs
and by the online DynamicMixingDataset (data/dynamic.py).
"""
