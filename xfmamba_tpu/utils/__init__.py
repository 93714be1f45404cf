"""Cross-cutting utilities: FLOPs counting, profiling, saliency."""
