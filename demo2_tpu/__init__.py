"""demo2_tpu: TPU-native tri-modal Re-ID framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the DeMo2
reference stack (multi-modal object re-identification on RGBNT201 / RGBNT100
/ MSVR310).  See SURVEY.md for the layer map and reference citations.
"""

__version__ = "0.1.0"
