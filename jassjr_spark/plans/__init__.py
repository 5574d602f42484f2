"""Job plans: staged, checkpoint-resumable pipelines with lineage/metrics."""
