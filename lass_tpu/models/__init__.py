from lass_tpu.models.film import FusedFiLM, FilmEntry, resunet30_film_spec
from lass_tpu.models.resunet import ResUNet30

__all__ = ["FusedFiLM", "FilmEntry", "resunet30_film_spec", "ResUNet30"]
