from .hashgrid import HashGridSpec, hashgrid_encode, init_hashgrid  # noqa: F401
from .sh import sh_encode  # noqa: F401
