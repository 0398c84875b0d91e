def varint(b, i):
    r = 0; s = 0
    while True:
        x = b[i]; i += 1
        r |= (x & 0x7f) << s
        if not x & 0x80: return r, i
        s += 7

def fields(b):
    i = 0
    while i < len(b):
        tag, i = varint(b, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = varint(b, i); yield fno, v
        elif wt == 2:
            ln, i = varint(b, i); yield fno, b[i:i+ln]; i += ln
        elif wt == 5:
            yield fno, b[i:i+4]; i += 4
        elif wt == 1:
            yield fno, b[i:i+8]; i += 8
