"""skani-tpu: TPU-native ANI/AF engine (JAX/XLA/Pallas) with the
capabilities of skani (FracMinHash sketching + sparse anchor chaining).

Reference behavior spec: bluenote-1577/skani v0.3.0.
"""
from .params import (CommandParams, MapParams, Mode, SketchParams,
                     map_params_from_sketch)
from .sketch import (Sketch, fastx_to_multiple_sketch_rewrite,
                     fastx_to_sketches, fmh_seeds_np, sketch_file)
from .ani import AniEstResult, chain_seeds, calculate_ani
from .gbdt import get_model, predict_from_ani_res, use_learned_ani

__version__ = "0.3.0"
