"""evo_tpu — TPU-native genomic sequence-modeling framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
`evo-design/evo` (StripedHyena-7B hybrid: Hyena long-conv + rotary
attention), designed for TPU: SPMD over device meshes, single-program
prefill+decode, Pallas kernels on the hot path.

Public API surface mirrors the reference `evo/__init__.py:1-7`.
"""

from evo_tpu.models import Evo  # noqa: F401
from evo_tpu.generation import generate  # noqa: F401
from evo_tpu.scoring import score_sequences, positional_entropies  # noqa: F401
from evo_tpu.scoring import (score_sequences_segmented,  # noqa: F401
                             positional_entropies_segmented)
from evo_tpu.serving import (GenerationServer,  # noqa: F401
                             serve_requests)
from evo_tpu.speculative import generate_speculative  # noqa: F401
from evo_tpu.version import version as __version__  # noqa: F401
