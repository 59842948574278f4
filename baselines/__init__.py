"""Experiment harness for TFIM thermal-state QHBM experiments.

TPU-native rebuild of the reference's baselines/ tree (reference
baselines/train.py, config.py, pqc.py, utils.py, launch.py): config-driven
VQT / QVARTZ experiments with vanilla, natural-gradient (BKM information
matrix) and mirror-descent training, metrics logging (JSONL always,
TensorBoard when available), orbax checkpointing, and a local multi-run sweep
launcher replacing the reference's XManager/Vertex-AI cloud launcher.
"""
