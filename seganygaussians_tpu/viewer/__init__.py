"""Viewers: SIBR network protocol + offline orbit viewer."""
