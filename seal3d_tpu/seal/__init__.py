"""Seal-3D editing layer: proxy-function mappers, teacher/student distillation.

TPU redesign of the reference SealNeRF package (SURVEY.md §1 L4): mappers are
pure jittable functions over precomputed array pytrees (no stateful torch
classes, no boolean indexing — masked jnp.where everywhere); the teacher is
the same field module with a remapping wrapper; the student trainer is a
two-stage schedule over one jitted distill step.
"""

from seal3d_tpu.seal.mappers import SealMapper, build_mapper, load_mapper_config
from seal3d_tpu.seal.trainer import SealTrainer, PretrainConfig
