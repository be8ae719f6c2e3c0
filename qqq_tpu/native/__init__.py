from qqq_tpu.native.build import load_native, pack_int4_host, unpack_int4_host
