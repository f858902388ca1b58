"""text2pos_tpu — TPU-native Text2Pos (text-to-point-cloud localization).

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
mako443/Text2Pos-CVPR2022. See README.md for usage, docs/PARITY.md for the
component-by-component mapping to the reference, and docs/DESIGN.md for
the TPU-first design rationale.
"""

__version__ = "0.1.0"
