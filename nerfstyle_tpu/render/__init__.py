from .renderer import Renderer, RenderSettings, render_rays

__all__ = ["Renderer", "RenderSettings", "render_rays"]
