"""Flax model families: 2d mel CNN, 1d hierarchical CNN, backbone CNN,
APC/CPC self-supervised models, adversarial domain discriminator."""
