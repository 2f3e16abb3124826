"""IO, config, datasets, export, logging, synthetic worlds."""
