"""Pallas TPU kernels: the whole LM solve resident in VMEM."""
