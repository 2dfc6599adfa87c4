"""TPU-native rebuild of Florescence/UNet-Medical-Image-Contour-Segmentation-cpp.

A complete JAX/XLA/Pallas framework that turns 16-bit grayscale medical
images (headerless RAW, DICOM/TIFF extensions) into per-image polygon-contour
JSON via a UNet — the same capabilities as the C++/TensorRT reference, but
designed TPU-first: one compiled XLA program for everything dense, a small
host C++ library for the pointer-chasing parts (contour tracing, JSON bytes),
and jax.sharding meshes for scale-out.

Public entry points mirror the reference's (include/initialize.h:12,
include/process.h:29, include/cleanup.h:7):

    from unetseg_tpu import engine
    engine.initialize_engine(cache_path)
    engine.process_single_image(image_path, width, height, output_dir)
    engine.cleanup_resources()
"""

__version__ = "0.1.0"
