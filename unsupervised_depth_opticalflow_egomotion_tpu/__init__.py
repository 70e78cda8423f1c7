"""TPU-native framework for joint unsupervised depth / optical-flow / ego-motion learning.

A ground-up JAX/Flax/Pallas re-design of the capabilities of
jianfenglihg/Unsupervised_depth_OpticalFlow_egomotion (TrianFlow-style joint
self-supervision on monocular video):

- ``ops``        pure, jittable geometry / warping / loss kernels (NHWC, TPU-first)
- ``models``     Flax modules: feature pyramid, PWC flow decoder, ResNet depth net, pose net
- ``parallel``   mesh construction + pjit train step (data-parallel over ICI)
- ``data``       host-side KITTI preparation and input pipeline
- ``evaluation`` KITTI flow/depth/odometry metric harnesses
- ``visualize``  flow/depth colorization and debug dumps
- ``utils``      checkpointing (orbax), logging, profiling

Everything on the device path is functional and jit-compiled; host code
(data prep, eval protocol) stays numpy.
"""

__version__ = "0.1.0"
