DATASETS = {}


def register(name):
    def deco(cls):
        DATASETS[name] = cls
        return cls
    return deco


def get_dataset(name: str):
    # populate registry lazily
    from . import blender  # noqa: F401
    if name in ("real_arkit", "real_colmap", "llff"):
        from . import real_arkit, real_colmap  # noqa: F401
    return DATASETS[name]
