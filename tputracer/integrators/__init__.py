from tputracer.integrators.pt import render_pt, trace_radiance  # noqa: F401
