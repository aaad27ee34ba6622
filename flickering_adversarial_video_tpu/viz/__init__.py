from .results import save_result_pkl, result_filename, load_result
from .tensorboard import ScalarWriter
