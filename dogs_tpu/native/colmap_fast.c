/* Fast COLMAP binary model parsing — the native data-path component.
 *
 * Large scenes carry multi-gigabyte points3D.bin files with
 * variable-length observation tracks; parsing them point-by-point in
 * Python (as the reference's vendored pycolmap does,
 * conerf/pycolmap/pycolmap/scene_manager.py:100-300) takes minutes. This
 * single-pass C scanner fills caller-provided xyz/rgb/error arrays at
 * memory-bandwidth speed and is loaded via ctypes
 * (dogs_tpu/data/native.py) with a pure-Python fallback.
 *
 * Layout per point (COLMAP spec):
 *   u64 id | 3 x f64 xyz | 3 x u8 rgb | f64 error |
 *   u64 track_len | track_len x (i32 image_id, i32 point2D_idx)
 *
 * Build: scripts/build_native.sh (gcc -O3 -shared -fPIC).
 */

#include <stdint.h>
#include <stdio.h>
#include <string.h>

/* Returns number of points parsed, or -1 on malformed input.
 * buf/len: whole file contents. Arrays must hold `capacity` entries. */
long parse_points3d(
    const unsigned char *buf,
    long len,
    long capacity,
    double *xyz,      /* capacity x 3 */
    unsigned char *rgb, /* capacity x 3 */
    double *error     /* capacity */
) {
    if (len < 8) return -1;
    uint64_t n;
    memcpy(&n, buf, 8);
    long off = 8;
    long count = 0;
    for (uint64_t i = 0; i < n; i++) {
        /* id(8) + xyz(24) + rgb(3) + error(8) + track_len(8) = 51 bytes */
        if (off + 51 > len) return -1;
        if (count < capacity) {
            memcpy(&xyz[count * 3], buf + off + 8, 24);
            memcpy(&rgb[count * 3], buf + off + 32, 3);
            memcpy(&error[count], buf + off + 35, 8);
        }
        uint64_t track_len;
        memcpy(&track_len, buf + off + 43, 8);
        off += 51 + (long)track_len * 8;
        if (off > len) return -1;
        count++;
    }
    return count;
}

/* images.bin scan: returns image count; fills qvec (n x 4), tvec (n x 3),
 * camera_id (n), and writes names into a flat char buffer separated by
 * '\0' (name_buf of name_cap bytes). */
long parse_images(
    const unsigned char *buf,
    long len,
    long capacity,
    double *qvec,
    double *tvec,
    int32_t *camera_id,
    int32_t *image_id,
    char *name_buf,
    long name_cap
) {
    if (len < 8) return -1;
    uint64_t n;
    memcpy(&n, buf, 8);
    long off = 8;
    long name_off = 0;
    long count = 0;
    for (uint64_t i = 0; i < n; i++) {
        if (off + 4 + 56 + 4 > len) return -1;
        if (count < capacity) {
            memcpy(&image_id[count], buf + off, 4);
            memcpy(&qvec[count * 4], buf + off + 4, 32);
            memcpy(&tvec[count * 3], buf + off + 36, 24);
            memcpy(&camera_id[count], buf + off + 60, 4);
        }
        off += 64;
        /* name: null-terminated */
        long start = off;
        while (off < len && buf[off] != 0) off++;
        if (off >= len) return -1;
        long nlen = off - start;
        if (count < capacity && name_off + nlen + 1 <= name_cap) {
            memcpy(name_buf + name_off, buf + start, nlen);
            name_buf[name_off + nlen] = 0;
            name_off += nlen + 1;
        }
        off++; /* skip null */
        if (off + 8 > len) return -1;
        uint64_t n_pts;
        memcpy(&n_pts, buf + off, 8);
        off += 8 + (long)n_pts * 24;
        if (off > len) return -1;
        count++;
    }
    return count;
}
