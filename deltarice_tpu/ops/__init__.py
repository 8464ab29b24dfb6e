from .prefilter import prefilter_encode, prefilter_decode
from .rice import zigzag, unzigzag, codeword_lengths_values
from .pack_xla import pack_bits, unpack_bits

__all__ = [
    "prefilter_encode",
    "prefilter_decode",
    "zigzag",
    "unzigzag",
    "codeword_lengths_values",
    "pack_bits",
    "unpack_bits",
]
