"""Segmentation / query layer: scale gate, similarity, clustering, CLIP."""
