"""freesound_classification_tpu — a TPU-native audio-tagging framework.

A ground-up JAX/Flax/optax/orbax/Pallas rebuild of the capabilities of the
3rd-place Freesound Audio Tagging 2019 solution (reference:
ex4sperans/freesound-classification). The compute path (STFT -> log-mel ->
CNN/RNN -> LSEP loss -> lwlrap) is compiled end-to-end with XLA, featurization
runs on-device (fused Pallas kernel on TPU), augmentations are vmapped
PRNG-pure device ops, and data parallelism rides a `jax.sharding.Mesh`.

Subpackages
-----------
ops        DSP primitives, on-device augmentations, losses, metrics, schedules
models     Flax model families (2d mel CNN, 1d hierarchical CNN, backbone,
           APC/CPC self-supervised models, adversarial discriminator)
data       Host-side manifest/decode/bucketing pipeline + device prefetch
parallel   Mesh construction and sharding rules
training   The single shared training engine (the reference duplicates its
           train loop per model; here there is exactly one)
utils      Experiment tracking, config tree, descriptor parsing
cli        Entry points mirroring the reference script surface
"""

__version__ = "0.1.0"
