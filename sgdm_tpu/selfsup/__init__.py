from .cluster import cal_cluster_metric, clustering
from .cluster_pca import clustering_pca, run_pca_views
from .feat_extractor import extract_feat
from .lost import lost, run_lost, write_lost_h5
from .ssl_backbone import SSLBackbone, get_ssl_backbone
from .stego import DinoFeaturizer, StegoInference, cluster_probe_log_probs
from .stego_train import (
    cluster_probe_loss,
    contrastive_correlation_loss,
    linear_probe_loss,
)

__all__ = [
    "cal_cluster_metric", "clustering", "clustering_pca", "run_pca_views",
    "extract_feat", "lost", "run_lost", "write_lost_h5",
    "SSLBackbone", "get_ssl_backbone",
    "DinoFeaturizer", "StegoInference", "cluster_probe_log_probs",
    "cluster_probe_loss", "contrastive_correlation_loss", "linear_probe_loss",
]
