from . import rays, sampling, pose, mathutil  # noqa: F401
