from egoego_release_tpu.eval import metrics
