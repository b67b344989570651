"""Table IO seam and deterministic synthetic data generators."""
