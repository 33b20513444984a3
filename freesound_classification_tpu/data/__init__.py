"""Host-side data pipeline: WAV decode, manifests, K-folds, length-bucketed
static-shape batching, device prefetch."""
