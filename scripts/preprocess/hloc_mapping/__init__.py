"""Learned-feature SfM pipeline (hloc) with native geometry/graph cores.

See sfm_pipeline.py for the orchestrator; geometry.py, filter_matches.py
and pairs_from_retrieval.py are dependency-free numpy and usable on their
own."""
