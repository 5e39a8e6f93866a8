from rechorus_tpu.data.readers import BaseReader, SeqReader
