from egoego_release_tpu.serving.export import (  # noqa: F401
    export_chain,
    export_chain_sharded,
    export_e2e,
    export_fk,
    export_stage1,
    load_artifact,
    save_artifact,
)
