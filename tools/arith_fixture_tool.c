/* Fixture generator for the pure-numpy arithmetic-JPEG decoder.
 *
 * Drives the SYSTEM libjpeg (public IJG API) to produce REAL
 * arithmetic-coded JPEG streams plus two ground truths:
 *   encode  in.ppm out.jpg quality subsamp restart progressive
 *             -- cinfo.arith_code = TRUE always
 *   coef    in.jpg out.bin
 *             -- dumps the quantized DCT coefficient arrays
 *                (jpeg_read_coefficients): the EXACT integers the
 *                entropy decoder must recover -- a bit-exact oracle
 *                with no IDCT tolerance in it.
 *   decode  in.jpg out.ppm
 *             -- libjpeg float-IDCT pixel decode (loose pixel oracle).
 *
 * Build:  gcc -O2 -o arith_fixture_tool arith_fixture_tool.c -ljpeg
 * Used by tools/make_arith_fixtures.py; the resulting fixtures are
 * committed so tests never need a compiler.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static void die(const char *m) { fprintf(stderr, "%s\n", m); exit(1); }

static unsigned char *read_ppm(const char *path, int *w, int *h, int *nc) {
  FILE *f = fopen(path, "rb");
  char magic[3] = {0};
  int maxv;
  unsigned char *buf;
  size_t n;
  if (!f) die("open ppm");
  if (fscanf(f, "%2s %d %d %d", magic, w, h, &maxv) != 4) die("ppm hdr");
  fgetc(f);
  *nc = strcmp(magic, "P6") == 0 ? 3 : 1;
  n = (size_t)(*w) * (*h) * (*nc);
  buf = malloc(n);
  if (fread(buf, 1, n, f) != n) die("ppm body");
  fclose(f);
  return buf;
}

static void encode(const char *in, const char *out, int quality,
                   int subsamp, int restart, int progressive) {
  struct jpeg_compress_struct c;
  struct jpeg_error_mgr jerr;
  int w, h, nc, y;
  unsigned char *px = read_ppm(in, &w, &h, &nc);
  FILE *f = fopen(out, "wb");
  if (!f) die("open out");
  c.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&c);
  jpeg_stdio_dest(&c, f);
  c.image_width = w;
  c.image_height = h;
  c.input_components = nc;
  c.in_color_space = nc == 3 ? JCS_RGB : JCS_GRAYSCALE;
  jpeg_set_defaults(&c);
  jpeg_set_quality(&c, quality, TRUE);
  c.arith_code = TRUE;
  if (nc == 3 && !subsamp) {
    c.comp_info[0].h_samp_factor = 1;
    c.comp_info[0].v_samp_factor = 1;
  }
  if (restart) c.restart_interval = restart;
  if (progressive) jpeg_simple_progression(&c);
  jpeg_start_compress(&c, TRUE);
  for (y = 0; y < h; y++) {
    JSAMPROW row = px + (size_t)y * w * nc;
    jpeg_write_scanlines(&c, &row, 1);
  }
  jpeg_finish_compress(&c);
  jpeg_destroy_compress(&c);
  fclose(f);
  free(px);
}

static void coef(const char *in, const char *out) {
  struct jpeg_decompress_struct d;
  struct jpeg_error_mgr jerr;
  jvirt_barray_ptr *arrays;
  FILE *fi = fopen(in, "rb"), *fo = fopen(out, "wb");
  int ci;
  if (!fi || !fo) die("open");
  d.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&d);
  jpeg_stdio_src(&d, fi);
  jpeg_read_header(&d, TRUE);
  arrays = jpeg_read_coefficients(&d);
  if (!arrays) die("coef read");
  fprintf(fo, "NCOMP %d\n", d.num_components);
  for (ci = 0; ci < d.num_components; ci++) {
    jpeg_component_info *comp = d.comp_info + ci;
    JDIMENSION by;
    fprintf(fo, "COMP %d %u %u\n", ci,
            comp->width_in_blocks, comp->height_in_blocks);
    for (by = 0; by < comp->height_in_blocks; by++) {
      JBLOCKARRAY rows = (*d.mem->access_virt_barray)
        ((j_common_ptr)&d, arrays[ci], by, 1, FALSE);
      fwrite(rows[0], sizeof(JCOEF), 64 * comp->width_in_blocks, fo);
    }
  }
  jpeg_finish_decompress(&d);
  jpeg_destroy_decompress(&d);
  fclose(fi);
  fclose(fo);
}

static void decode(const char *in, const char *out) {
  struct jpeg_decompress_struct d;
  struct jpeg_error_mgr jerr;
  FILE *fi = fopen(in, "rb"), *fo = fopen(out, "wb");
  unsigned char *row;
  if (!fi || !fo) die("open");
  d.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&d);
  jpeg_stdio_src(&d, fi);
  jpeg_read_header(&d, TRUE);
  d.dct_method = JDCT_FLOAT;
  jpeg_start_decompress(&d);
  fprintf(fo, "%s\n%u %u\n255\n", d.output_components == 3 ? "P6" : "P5",
          d.output_width, d.output_height);
  row = malloc((size_t)d.output_width * d.output_components);
  while (d.output_scanline < d.output_height) {
    JSAMPROW r = row;
    jpeg_read_scanlines(&d, &r, 1);
    fwrite(row, 1, (size_t)d.output_width * d.output_components, fo);
  }
  free(row);
  jpeg_finish_decompress(&d);
  jpeg_destroy_decompress(&d);
  fclose(fi);
  fclose(fo);
}

int main(int argc, char **argv) {
  if (argc >= 8 && strcmp(argv[1], "encode") == 0)
    encode(argv[2], argv[3], atoi(argv[4]), atoi(argv[5]),
           atoi(argv[6]), atoi(argv[7]));
  else if (argc >= 4 && strcmp(argv[1], "coef") == 0)
    coef(argv[2], argv[3]);
  else if (argc >= 4 && strcmp(argv[1], "decode") == 0)
    decode(argv[2], argv[3]);
  else
    die("usage: encode in.ppm out.jpg q subsamp restart progressive | "
        "coef in.jpg out.bin | decode in.jpg out.ppm");
  return 0;
}
