"""tpuseg — TPU-native medical image segmentation framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
junqiangchen/PytorchDeepLearing (see SURVEY.md): a 2D/3D segmentation /
classification / GAN / registration model zoo, a full loss and metric
library, host data pipeline with ITK-equivalent geometry, whole-volume and
batched sliding-window inference, data-parallel + spatially-partitioned
training over device meshes, and sharded checkpoint/resume.

Layout convention: channels-LAST everywhere on device (NHWC / NDHWC) — the
TPU-native layout. The `tpuseg.compat` Model classes accept channel-first
numpy arrays at the boundary for API parity with the reference
(`/root/reference/model/__init__.py:1-3`).
"""

__version__ = "0.1.0"

from tpuseg.core import mesh as mesh  # noqa: F401
