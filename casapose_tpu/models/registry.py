"""Model zoo registry: reference model names -> VariantSpecs.

Mirrors casapose/pose_models/models_factory.py:9-32. Each entry reproduces
the wiring of the corresponding hand-unrolled Keras graph (see
casapose.py docstring in this package). ``Classifiers.get(name)`` keeps the
reference's factory API shape.
"""

from typing import Optional

from casapose_tpu.models.casapose import CASAPoseModel, DecoderParams, PVNetModel, VariantSpec

_DP = DecoderParams


def _spec(pc=(0, 0, 0, 0, 0), gu=False, bu=False, rc=(0, 0, 0, 0, 0), **kw):
    """Build a VariantSpec; gu/bu apply to the upsampled layers (1..3)."""
    params = tuple(
        _DP(
            weighted_clade=True,
            partial_conv=bool(pc[i]),
            guided_upsampling=gu and 0 < i < 4,
            bilinear_upsampling=bu and 0 < i < 4,
            reuse_conv=bool(rc[i]),
        )
        for i in range(5)
    )
    return VariantSpec(decoder_params=params, **kw)


def parse_decoder_params(spec):
    """Per-layer DecoderParams from a compact description.

    Accepts a list of 5 DecoderParams / 5-tuples / dicts, or a string of 5
    comma-separated 5-bit groups "wc pc gu bu rc", e.g. the gcu5 wiring is
    ``"11000,11100,11100,11100,11000"``. Mirrors the reference's
    ``CASAPose(layer_params, ...)`` contract (casapose.py:18-35).
    """
    if isinstance(spec, str):
        groups = [g.strip() for g in spec.split(",")]
        if len(groups) != 5 or any(len(g) != 5 or set(g) - {"0", "1"} for g in groups):
            raise ValueError(
                f"decoder_params string must be 5 comma-separated 5-bit groups (wc pc gu bu rc), got {spec!r}"
            )
        spec = [tuple(c == "1" for c in g) for g in groups]
    if len(spec) != 5:
        raise ValueError(f"decoder_params needs exactly 5 per-layer entries, got {len(spec)}")
    out = []
    for entry in spec:
        if isinstance(entry, DecoderParams):
            out.append(entry)
        elif isinstance(entry, dict):
            out.append(DecoderParams(**entry))
        else:
            wc, pc, gu, bu, rc = entry
            out.append(
                DecoderParams(
                    weighted_clade=bool(wc), partial_conv=bool(pc), guided_upsampling=bool(gu),
                    bilinear_upsampling=bool(bu), reuse_conv=bool(rc),
                )
            )
    return tuple(out)


MODEL_SPECS = {
    # Paper models (BMVC 2022)
    "casapose_c": _spec(stop_gradient_mask=False, halfsize_trainable=True),  # Conditional1
    "casapose_c_gu": _spec(gu=True),  # Conditional2
    "casapose_c_gcu3": _spec(pc=(1, 1, 1, 0, 0), gu=True),  # Conditional3
    "casapose_c_gcu4": _spec(pc=(1, 1, 1, 1, 0), gu=True),  # Conditional4
    "casapose_c_gcu5": _spec(pc=(1, 1, 1, 1, 1), gu=True),  # Conditional5 (flagship)
    # Configurable builder with the shipped "clade" params == gcu5 wiring.
    "casapose_custom": _spec(pc=(1, 1, 1, 1, 1), gu=True),
    # Alternative models
    "casapose_c_gcu5_sw5": _spec(rc=(1, 1, 1, 1, 1), gu=True),  # Conditional6
    "casapose_c_gcu4_sw1": _spec(pc=(0, 1, 1, 1, 1), rc=(1, 0, 0, 0, 0), gu=True),  # Conditional7
    "casapose_c_gcu5_sw1": _spec(  # Conditional8: no decoder-2 skip concats
        pc=(0, 1, 1, 1, 1), rc=(1, 0, 0, 0, 0), gu=True, decoder2_skip_connections=False
    ),
    "casapose_c_gcu4_bilat": _spec(pc=(1, 1, 1, 1, 0), gu=True, bu=True),  # Conditional9
    "casapose_c_gcu4_sw2": _spec(  # Conditional10: shared 1-2 (layer 1 re-applied WITH mask), partial 3-4
        pc=(0, 0, 1, 1, 0), rc=(1, 1, 0, 0, 0), gu=True, reuse_first_with_mask=True
    ),
}

PVNET_NAMES = ("pvnet", "pvnet_combined")


def get_model(
    name: str,
    ver_dim: int,
    seg_dim: int,
    base_model: str = "resnet18",
    output_labelmap: bool = False,
    **kwargs,
):
    """Instantiate a model module by reference name.

    ``casapose_custom`` additionally accepts ``decoder_params`` (see
    :func:`parse_decoder_params`) to reconfigure the five decoder layers
    without code duplication — the reference's generic ``CASAPose(
    layer_params, ...)`` builder (casapose.py:145, models_factory.py:24).
    Defaults to the shipped "clade" wiring (== gcu5 layer structure).
    """
    if name in PVNET_NAMES:
        kwargs.pop("decoder_params", None)
        return PVNetModel(
            ver_dim=ver_dim, seg_dim=seg_dim, base_model=base_model, output_labelmap=output_labelmap, **kwargs
        )
    if name not in MODEL_SPECS:
        raise ValueError(f"No such model `{name}`, available models: {sorted(MODEL_SPECS) + list(PVNET_NAMES)}")
    spec = MODEL_SPECS[name]
    decoder_params = kwargs.pop("decoder_params", None)
    if decoder_params is not None:
        if name != "casapose_custom":
            raise ValueError("decoder_params is only configurable for `casapose_custom`")
        # Generic-builder semantics: shared convs are reused WITHOUT the
        # class mask in decoder 2 (ref casapose.py:229-230).
        spec = VariantSpec(decoder_params=parse_decoder_params(decoder_params), shared_reuse_with_mask=False)
    return CASAPoseModel(
        spec=spec,
        ver_dim=ver_dim,
        seg_dim=seg_dim,
        base_model=base_model,
        output_labelmap=output_labelmap,
        **kwargs,
    )


class _ClassifiersFactory:
    """API-compatible stand-in for the reference's ``Classifiers``."""

    def models_names(self):
        return sorted(MODEL_SPECS) + list(PVNET_NAMES)

    def get(self, name: str):
        if name not in self.models_names():
            raise ValueError(f"No such model `{name}`, available models: {self.models_names()}")

        def factory(ver_dim, seg_dim, base_model="resnet18", **kwargs):
            kwargs.pop("input_shape", None)
            kwargs.pop("input_segmentation_shape", None)
            kwargs.pop("input_tensor", None)
            kwargs.pop("weights", None)
            kwargs.pop("backbone", None)
            return get_model(name, ver_dim, seg_dim, base_model=base_model, **kwargs)

        return factory


Classifiers = _ClassifiersFactory()
