"""Public decode API (mirrors the reference C API flow:
YAIK_Init/YAIK_AssignLUT/YAIK_DecodeImagePre/YAIK_DecodeImage).

`assign_lut` parses + expands a LUT bank once; `decode_image` decodes one
stream. The default engine is the bit-exact host path; engine="jax" uses the
TPU kernels (same results, validated in tests).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from yaik_tpu.decoder import reference
from yaik_tpu.format import lut as lutmod
from yaik_tpu.format.headers import FileHeader, MAGIC


@dataclass
class LutBank:
    tables: dict
    expanded: dict


def assign_lut(lut_data: bytes) -> LutBank:
    tables = lutmod.parse_lut_file(lut_data)
    return LutBank(tables=tables, expanded=lutmod.expand_lut(tables))


def decode_image_pre(stream: bytes):
    """Returns (width, height, has_alpha) like YAIK_DecodeImagePre."""
    fh = FileHeader.unpack(stream)
    if fh.tag != MAGIC:
        raise ValueError("not a YAIK stream")
    return fh.width, fh.height, fh.has_alpha


def decode_image(stream: bytes, lut: LutBank | bytes,
                 engine: str = "host") -> np.ndarray:
    if isinstance(lut, (bytes, bytearray)):
        lut = assign_lut(bytes(lut))
    if engine == "host":
        return reference.decode(stream, lut.expanded)
    elif engine == "jax":
        from yaik_tpu.decoder import jax_engine
        return jax_engine.decode(stream, lut)
    raise ValueError(f"unknown engine {engine!r}")
