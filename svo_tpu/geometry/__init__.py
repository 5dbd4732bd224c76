from svo_tpu.geometry import se3, camera, triangulate, pnp  # noqa: F401
