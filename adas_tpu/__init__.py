"""vehicle-cv-adas-tpu: TPU-native ADAS perception framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
jason-li-831202/Vehicle-CV-ADAS: object detection (YOLOv5..v10,
EfficientDet), lane detection (UFLD v1/v2), ByteTrack multi-object
tracking, single-camera distance estimation, bird's-eye-view geometry and
the FCWS/LDWS/LKAS driver-assist state machines — with the model compute
path compiled to TPU via XLA and the hot image ops written as fused
device kernels.
"""

__version__ = "0.1.0"
