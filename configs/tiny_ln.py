from laff_tpu.configs import base_config as BaseConfig
from laff_tpu.configs.tiny import config as _tiny


class config(_tiny):
    # attention index 14: Multi_head_Attention_layer_norm
    txt_attention = BaseConfig.ATTENTION_TYPES[14]
    vis_attention = BaseConfig.ATTENTION_TYPES[14]
    attention_param_each_head = {'with_ave': True, 'mul': False, 'split_head': True}
