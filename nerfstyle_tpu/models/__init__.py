from .fields import (
    FieldSpec,
    field_apply,
    field_density,
    field_init,
    style_field_spec,
)

__all__ = [
    "FieldSpec",
    "field_apply",
    "field_density",
    "field_init",
    "style_field_spec",
]
