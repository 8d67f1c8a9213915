from ullsam_tpu.serve.engine import GenerationEngine
from ullsam_tpu.serve.state import Session, ingest_image, instance_overlay
