from .renderer import RenderSettings, render_rays  # noqa: F401
from .tracer import TraceSettings, trace_rays  # noqa: F401
