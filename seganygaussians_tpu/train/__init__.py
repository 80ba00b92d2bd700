"""Training loops: 3DGS scene training + SAGA contrastive feature training."""
