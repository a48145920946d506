import hashlib, datetime, decimal
def canon_val(v):
    if v is None: return 'NULL'
    if isinstance(v, bool): return 'true' if v else 'false'
    if isinstance(v, int): return str(v)
    if isinstance(v, float): return '%.4f' % v
    if isinstance(v, decimal.Decimal): return '%.4f' % float(v)
    if isinstance(v, datetime.datetime): return v.strftime('%Y-%m-%d %H:%M:%S.%f')
    if isinstance(v, datetime.date): return v.strftime('%Y-%m-%d') + ' 00:00:00.000000'
    if isinstance(v, (list, tuple)): return '[' + ','.join(canon_val(x) for x in v) + ']'
    return str(v)
def canon_rows(rows):
    lines = ['|'.join(canon_val(v) for v in r) for r in rows]
    h = hashlib.sha256('\n'.join(lines).encode()).hexdigest()[:16]
    return h, lines
