from .saliency import gradcam_heatmaps, attention_rollout
from .embedding import tsne_plot
from .rank_list import save_rank_list, visualize_ranked_results
from .similarity import similarity_distributions
