"""Host-side I/O: Radiance RGBE (.hdr) codec, PNG helpers, image normalize.

These run on the host (numpy/PIL) by design — SURVEY.md §7.3 host/device split:
decode/encode stays on CPU, everything from normalize-to-[-1,1] onward is jnp.
"""

from gmdx.io.rgbe import read_hdr, write_hdr, rgbe_encode, rgbe_decode
from gmdx.io.image import (
    load_image,
    save_image,
    to_model_input,
    from_model_output,
    save_hdr_image,
)

__all__ = [
    "read_hdr",
    "write_hdr",
    "rgbe_encode",
    "rgbe_decode",
    "load_image",
    "save_image",
    "to_model_input",
    "from_model_output",
    "save_hdr_image",
]
