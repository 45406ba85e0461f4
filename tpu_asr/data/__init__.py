from tpu_asr.data.manifest import Utterance, load_manifest, save_manifest, load_espnet_json
from tpu_asr.data.bucketing import Bucket, make_buckets, plan_batches
from tpu_asr.data.loader import DataLoader

__all__ = ["Utterance", "load_manifest", "save_manifest", "load_espnet_json",
           "Bucket", "make_buckets", "plan_batches", "DataLoader"]
