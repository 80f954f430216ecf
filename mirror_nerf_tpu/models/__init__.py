from .embedding import posenc, posenc_dim  # noqa: F401
from .fields import MirrorNeRFField, make_field  # noqa: F401
