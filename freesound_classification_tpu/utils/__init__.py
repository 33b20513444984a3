"""Experiment tracking, config tree, misc utilities."""
