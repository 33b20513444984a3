"""DSP primitives, featurization, augmentations, losses, metrics, schedules."""
