from laff_tpu.configs.tiny import config as _tiny


class config(_tiny):
    float16 = True
