from .config import AttrDict, load_config, default_config
from .labels import load_label_map, kinetics400_labels
from .system import num_devices, system_info, db_num_workers
