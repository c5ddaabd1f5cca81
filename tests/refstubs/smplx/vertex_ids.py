vertex_ids = {"smplh": {}, "smplx": {}}
