from tputracer.bsdf.bsdf import (  # noqa: F401
    emitted,
    eval_bsdf,
    pdf_bsdf,
    sample_bsdf,
)
