"""whvi_tpu — TPU-native Walsh-Hadamard Variational Inference.

A from-scratch JAX / XLA / Pallas framework with the capabilities of the
reference PyTorch implementation (ltdung/WHVI), designed TPU-first:
functional core over parameter pytrees, explicit PRNG keys, one jitted
train step, mesh sharding for scale. See SURVEY.md for the reference
structural analysis this build follows.
"""

__version__ = "0.4.0"
