from laff_tpu.configs.tiny import config as _tiny


class config(_tiny):
    attention_param_each_head = {'with_ave': True, 'mul': False, 'split_head': True}
    txt_attention_global_decay_rate = 0.8
    vis_attention_global_decay_rate = 0.8
