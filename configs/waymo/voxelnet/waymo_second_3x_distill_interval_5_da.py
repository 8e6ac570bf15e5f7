"""SECOND S2D/PCR distillation student, domain-adaptation val split.

Field-level parity with the reference file configs/waymo/voxelnet/waymo_second_3x_distill_interval_5_da.py is
asserted by tests/test_config_zoo.py; the shared builders live in
sparse2dense_tpu/zoo.py.
"""
from sparse2dense_tpu.zoo import build

globals().update(build("waymo/voxelnet/waymo_second_3x_distill_interval_5_da"))
