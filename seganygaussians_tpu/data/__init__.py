"""Dataset readers (COLMAP / Blender / LERF), cameras, PLY I/O, sidecars."""
