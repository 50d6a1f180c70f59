"""Evaluation: 2D per-volume, 3D sliding-window, test CLIs."""
