from rsprompter_tpu.ops.attention import (  # noqa: F401
    attention_rel_pos,
    decomposed_rel_pos_tables,
    get_rel_pos,
)
